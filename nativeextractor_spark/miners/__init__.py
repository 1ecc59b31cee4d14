from nativeextractor_spark.miners.base import Miner, PatternMiner, Occurrence
from nativeextractor_spark.miners.glob import GlobMiner, glob_to_regex, is_glob
from nativeextractor_spark.miners.builtin import (
    EmailMiner,
    UrlMiner,
    DateMiner,
    RegexMiner,
    TelephoneMiner,
    TEL_NO_PATTERN,
)
from nativeextractor_spark.miners.ner import GazetteerMiner, AliasDict

__all__ = [
    "Miner",
    "PatternMiner",
    "Occurrence",
    "GlobMiner",
    "glob_to_regex",
    "is_glob",
    "EmailMiner",
    "UrlMiner",
    "DateMiner",
    "RegexMiner",
    "TEL_NO_PATTERN",
    "GazetteerMiner",
    "AliasDict",
]
