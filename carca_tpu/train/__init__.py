from carca_tpu.train.metrics import hr_ndcg_sums
from carca_tpu.train.state import TrainState, create_train_state, make_optimizer

__all__ = ["hr_ndcg_sums", "TrainState", "create_train_state", "make_optimizer"]
