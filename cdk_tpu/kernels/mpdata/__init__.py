from cdk_tpu.kernels.mpdata import problem, reference  # noqa: F401
