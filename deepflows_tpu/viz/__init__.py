"""Live-training visualization platform (reference:
`Visualization_backend/` + `Visualization_frontend/`)."""

from .server import (
    AVAILABLE_MODELS,
    ConnectionManager,
    build_dynamic_model,
    make_server,
    train_worker,
)

__all__ = [
    "make_server",
    "ConnectionManager",
    "build_dynamic_model",
    "train_worker",
    "AVAILABLE_MODELS",
]
