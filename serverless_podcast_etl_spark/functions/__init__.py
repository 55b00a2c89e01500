from . import dates, hashing, text, textstats

__all__ = ["dates", "hashing", "text", "textstats"]
