from .extract import analyze_documents, extract_spans

__all__ = ["analyze_documents", "extract_spans"]
