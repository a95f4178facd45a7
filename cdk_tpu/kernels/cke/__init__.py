from cdk_tpu.kernels.cke import gather_peradv, gather_selfold, onehot_mxu, pallas_lanegather, pallas_onehot, pallas_rows, problem, reference, staged  # noqa: F401
from cdk_tpu.kernels.cke.problem import CkeData, init_data  # noqa: F401
from cdk_tpu.kernels.cke.reference import edge_flux  # noqa: F401
