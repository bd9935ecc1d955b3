from dpvo_tpu.geom import projective  # noqa: F401
