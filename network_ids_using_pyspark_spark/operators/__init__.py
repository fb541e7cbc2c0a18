from .profile import profile_counts, profile_extremes
from .cleaning import (
    drop_null_rows,
    impute_median_exact,
    replace_inf,
    replace_inf_with_max,
)
from .relational import (
    count_distinct_values,
    distinct_values,
    label_histogram,
    top_k_per_group,
)
from .sampling import (
    add_row_id,
    anti_join_split,
    hash_sample,
    random_split,
    stratified_hash_sample,
    stratified_sample,
)
from .windowed import ranked, rolling_dec_sum, sessionize

__all__ = [
    "profile_counts",
    "profile_extremes",
    "drop_null_rows",
    "impute_median_exact",
    "replace_inf",
    "replace_inf_with_max",
    "count_distinct_values",
    "distinct_values",
    "label_histogram",
    "top_k_per_group",
    "add_row_id",
    "anti_join_split",
    "hash_sample",
    "random_split",
    "stratified_hash_sample",
    "stratified_sample",
    "ranked",
    "rolling_dec_sum",
    "sessionize",
]
