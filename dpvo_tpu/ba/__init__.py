from dpvo_tpu.ba.solver import (  # noqa: F401
    BAProblem,
    apply_depth_retr,
    apply_pose_retr,
    ba,
    ba_delta,
)
