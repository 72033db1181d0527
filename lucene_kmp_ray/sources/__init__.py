from .corpus import CORPUS_SQL, corpus_dataset, corpus_table  # noqa: F401
