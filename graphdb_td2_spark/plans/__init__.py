from .motif import find_motif, exclude_motif

__all__ = ["find_motif", "exclude_motif"]
