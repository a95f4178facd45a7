from cdk_tpu.dist import mesh  # noqa: F401
