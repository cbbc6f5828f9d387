from .html_text import extract_text, with_extracted_text

__all__ = ["extract_text", "with_extracted_text"]
