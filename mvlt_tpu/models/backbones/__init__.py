from mvlt_tpu.models.backbones.adapter import VisualAdapter

__all__ = ["VisualAdapter"]
