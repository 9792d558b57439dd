from .factory import (
    create_model_from_config,
    create_bottleneck_from_config,
    create_pretransform_from_config,
)
