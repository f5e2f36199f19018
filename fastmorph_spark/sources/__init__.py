from fastmorph_spark.sources.corpus import (
    documents_as_corpus,
    read_corpus,
    read_documents,
    read_table,
    synth_corpus,
    with_doc_ids,
)

__all__ = [
    "read_corpus",
    "read_documents",
    "read_table",
    "documents_as_corpus",
    "synth_corpus",
    "with_doc_ids",
]
