from .preview import normalize_map, save_preview_montage

__all__ = ["normalize_map", "save_preview_montage"]
