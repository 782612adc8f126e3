from lightzero_tpu.models.unizero_world_model.transformer import (
    Transformer,
    TransformerConfig,
    KVCache,
    init_kv_cache,
)
