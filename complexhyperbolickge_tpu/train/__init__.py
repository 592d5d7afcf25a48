from complexhyperbolickge_tpu.train.regularizers import get_regularizer  # noqa: F401
from complexhyperbolickge_tpu.train.trainer import Trainer, TrainConfig  # noqa: F401
from complexhyperbolickge_tpu.train.evaluate import compute_metrics, avg_both, format_metrics  # noqa: F401
