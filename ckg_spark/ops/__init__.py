from . import dedup, simsearch, textstats, multimodal

__all__ = ["dedup", "simsearch", "textstats", "multimodal"]
