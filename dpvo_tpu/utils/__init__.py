from dpvo_tpu.utils.timer import Timer  # noqa: F401
