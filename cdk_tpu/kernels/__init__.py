"""Kernel implementations: biharmonic, mpdata, cke.

Importing this package registers all variants in cdk_tpu.core.registry."""

from cdk_tpu.kernels import biharmonic, cke, mpdata  # noqa: F401
