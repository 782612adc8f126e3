from lightzero_tpu.search.types import (
    SearchConfig,
    RootOutput,
    RecurrentOutput,
    SearchOutput,
)
from lightzero_tpu.search.tree import Tree
from lightzero_tpu.search.puct import batch_puct_search
