"""TPU-native full-text engine (ft_fast analog).

Host side: tokenizer, stemmers, DSL parser, variant expanders, dictionary.
Device side: CSR posting arrays + fused BM25 scatter-max scoring (scorer.py).
Reference: cpp_src/core/ft/ (SURVEY.md §2.1 L3a).
"""
from .config import FtFastConfig
from .dsl import parse_ft_dsl
from .selector import FtSelector
from .dataholder import FtDataHolder

__all__ = ["FtFastConfig", "parse_ft_dsl", "FtSelector", "FtDataHolder"]
