from gvom_tpu.utils.metrics import StepMetrics
from gvom_tpu.utils.profiling import annotate, profile_trace
from gvom_tpu.utils.checkpoint import save_world, load_world

__all__ = ["StepMetrics", "annotate", "profile_trace", "save_world", "load_world"]
