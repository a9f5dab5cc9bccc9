from carca_tpu.data.loaders import Catalog, load_attrs, load_ctx, load_profiles, build_catalog
from carca_tpu.data.windowing import window_bounds, valid_users
from carca_tpu.data.dataset import BatchBuilder, epoch_batches
from carca_tpu.data.synthetic import synthetic_catalog

__all__ = [
    "Catalog", "load_attrs", "load_ctx", "load_profiles", "build_catalog",
    "window_bounds", "valid_users", "BatchBuilder", "epoch_batches",
    "synthetic_catalog",
]
