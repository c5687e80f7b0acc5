from gvom_tpu.engine.gvom import Gvom

__all__ = ["Gvom"]
