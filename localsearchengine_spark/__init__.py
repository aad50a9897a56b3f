"""localsearchengine_spark — a from-scratch PySpark-native inverted-index
builder and BM25 query engine with the capabilities of the reference
``noalac/LocalSearchEngine`` (Perl ``Index.pm``/``Split.pm`` pipeline; see
SURVEY.md §0 for provenance — the reference mount is empty in this sandbox,
so all reference claims are sourced from BASELINE.json).

Design: DataFrame-first, Catalyst-optimized, Arrow-vectorized Python only on
the genuinely non-relational paths (tokenization, posting-block codec,
block-max WAND). See SURVEY.md §2 for the operator inventory this package
implements.
"""

from localsearchengine_spark.config import BM25Config, BuildConfig

__all__ = ["BM25Config", "BuildConfig"]
__version__ = "0.1.0"
