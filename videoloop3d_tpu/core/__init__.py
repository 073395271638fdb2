from videoloop3d_tpu.core import cameras, planes, sh, activations  # noqa: F401
