from mvlt_tpu.ops import attention, layers, masks  # noqa: F401
