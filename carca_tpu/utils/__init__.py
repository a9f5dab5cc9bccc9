from carca_tpu.utils.masking import get_mask
from carca_tpu.utils.initializers import xavier_uniform, zeros_init

__all__ = ["get_mask", "xavier_uniform", "zeros_init"]
