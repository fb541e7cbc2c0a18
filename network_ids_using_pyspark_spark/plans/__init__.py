from .inspect import explain_str, count_in_plan, has_pushed_filters

__all__ = ["explain_str", "count_in_plan", "has_pushed_filters"]
