from wpvectordb_spark.sources.loaders import load_table, load_tables, doc_meta_from_documents

__all__ = ["load_table", "load_tables", "doc_meta_from_documents"]
