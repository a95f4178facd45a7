from cdk_tpu.kernels.biharmonic import dss, dss2d, operator, pallas_bd8, pallas_dss2d_resident, pallas_dss_resident, pallas_fused, problem, reference  # noqa: F401
from cdk_tpu.kernels.biharmonic.problem import BiharmonicData, init_data  # noqa: F401
from cdk_tpu.kernels.biharmonic.reference import biharmonic_wk_reference  # noqa: F401
