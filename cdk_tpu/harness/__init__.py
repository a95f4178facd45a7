from cdk_tpu.harness import driver, specs  # noqa: F401
