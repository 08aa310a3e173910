from mvlt_tpu.tasks.common import TaskRunner

__all__ = ["TaskRunner"]
