from .eps import sammon_eps, ps_string_filter

__all__ = ["sammon_eps", "ps_string_filter"]
