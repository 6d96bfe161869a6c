from depthg_tpu.models.zoedepth.model import (
    ZoeConfig,
    zoedepth_init,
    zoedepth_forward,
    zoedepth_infer,
    prep_size,
)
