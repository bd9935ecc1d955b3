from dpvo_tpu.slam.proximity import edges_loop, reduce_edges  # noqa: F401
