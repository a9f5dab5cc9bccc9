from carca_tpu.models.carca import carca_init, carca_apply
from carca_tpu.models.losses import masked_bce
from carca_tpu.models.knn import knn_apply

__all__ = ["carca_init", "carca_apply", "masked_bce", "knn_apply"]
