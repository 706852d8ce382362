from .trainer import (  # noqa: F401
    evaluate_models,
    fit_linear_head,
    fit_softmax_head,
    train_multitask_heads,
)
