from .pipeline import (
    assemble_features,
    confusion_matrix,
    encode_label,
    evaluate_multiclass,
    impute_median,
    prepare_flow_features,
    scale_minmax,
    train_classifier,
)

__all__ = [
    "assemble_features",
    "confusion_matrix",
    "encode_label",
    "evaluate_multiclass",
    "impute_median",
    "prepare_flow_features",
    "scale_minmax",
    "train_classifier",
]
