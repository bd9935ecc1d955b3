from dpvo_tpu.eval.ate import associate, ate_rmse, umeyama_alignment  # noqa: F401
