from lightzero_tpu.utils.registry import Registry, ENV_REGISTRY, POLICY_REGISTRY, MODEL_REGISTRY, BUFFER_REGISTRY
