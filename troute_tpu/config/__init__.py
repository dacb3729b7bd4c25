from troute_tpu.config.schema import Config, load_config
