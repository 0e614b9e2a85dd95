from .extract import analyze_documents, extract_spans, page_osd

__all__ = ["analyze_documents", "extract_spans", "page_osd"]
