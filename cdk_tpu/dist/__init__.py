from cdk_tpu.dist import biharmonic, cke, mesh, mpdata  # noqa: F401
