"""Reference-compatible CLI: ``python training.py`` reads
``model_properties.json`` (same schema as
``/root/reference/model_properties_example.json``, plus optional TPU-native
fields) and runs the chunked training loop.

Optionally pass a config path: ``python training.py my_config.json``.
"""

import sys

from stable_diffusion_training_tpu.train.trainer import main

if __name__ == "__main__":
    config_path = sys.argv[1] if len(sys.argv) > 1 else "model_properties.json"
    main(config_dict_path=config_path)
