from complexhyperbolickge_tpu.data.dataset import KGData  # noqa: F401
from complexhyperbolickge_tpu.data.preprocess import process_dataset  # noqa: F401
