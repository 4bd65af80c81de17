from . import scatter, sparse_conv, voxelize  # noqa: F401
