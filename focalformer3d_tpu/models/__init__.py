from . import (  # noqa: F401
    deformable_decoder,
    detector,
    focal_decoder,
    focal_encoder,
    layers,
    second,
    sparse_encoder,
    vfe,
)
