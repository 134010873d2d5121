from .windowed import revenue_window_agg, windowed_agg

__all__ = ["revenue_window_agg", "windowed_agg"]
