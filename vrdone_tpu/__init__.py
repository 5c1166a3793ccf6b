"""VrdONE-TPU: one-stage video visual relation detection, TPU-native.

See README.md for the architecture map and ARCHITECTURE.md for the
component-by-component correspondence with the reference stack.
"""

__version__ = "0.1.0"

from .config import (InferenceConfig, ModelConfig, PredictorConfig,
                     load_yaml_config, model_config_from_yaml)

__all__ = [
    "InferenceConfig", "ModelConfig", "PredictorConfig",
    "load_yaml_config", "model_config_from_yaml", "__version__",
]
