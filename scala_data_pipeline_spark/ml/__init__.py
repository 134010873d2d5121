from .pipeline import build_pipeline, prepare_training_frame, train_model

__all__ = ["build_pipeline", "prepare_training_frame", "train_model"]
