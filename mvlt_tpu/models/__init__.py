from mvlt_tpu.models import fusion  # noqa: F401
