from complexhyperbolickge_tpu.utils.nn import MLP, MonotonicMLP  # noqa: F401
from complexhyperbolickge_tpu.utils.profiling import StepTimer, trace  # noqa: F401
