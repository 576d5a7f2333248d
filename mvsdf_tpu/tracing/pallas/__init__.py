from .sdf_kernel import (pack_sdf_weights, make_pallas_sdf_fn,
                         pallas_sdf_apply)
from .secant_kernel import pallas_secant
