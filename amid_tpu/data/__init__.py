from amid_tpu.data.packed import (  # noqa: F401
    PackedDualDomainDataset,
    load_dual_domain_csv,
    pack_rows,
)
from amid_tpu.data.loader import BatchIterator  # noqa: F401
from amid_tpu.data.sampler import sample_negatives  # noqa: F401
