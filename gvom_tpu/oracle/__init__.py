from gvom_tpu.oracle.numpy_ref import NumpyOracle

__all__ = ["NumpyOracle"]
