from .tables import (corpus_tables, load_table, materialize_corpus,
                     read_documents, read_media)

__all__ = ["corpus_tables", "load_table", "materialize_corpus",
           "read_documents", "read_media"]
