from .watermark import WatermarkStore, incremental_filter

__all__ = ["WatermarkStore", "incremental_filter"]
