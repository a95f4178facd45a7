from cdk_tpu.kernels.cke import problem, reference  # noqa: F401
