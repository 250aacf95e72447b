"""Training loop + checkpointing (SURVEY.md C5, C8)."""

from tpugnn.train.loop import TrainState, init_state, loss_fn, make_train_step, train

__all__ = ["TrainState", "init_state", "loss_fn", "make_train_step", "train"]
