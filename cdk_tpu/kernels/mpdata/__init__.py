from cdk_tpu.kernels.mpdata import pallas_fused, pallas_lanes, pallas_masked, pallas_packed, pallas_resident, pallas_xmajor, problem, reference  # noqa: F401
from cdk_tpu.kernels.mpdata.problem import MpdataData, init_data  # noqa: F401
from cdk_tpu.kernels.mpdata.reference import advect_scalar2d  # noqa: F401
