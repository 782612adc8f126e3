from lightzero_tpu.config.core import Config, compile_config, deep_merge
