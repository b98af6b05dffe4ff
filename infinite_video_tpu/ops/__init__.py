from infinite_video_tpu.ops import basis, gmatrix, ltm  # noqa: F401
