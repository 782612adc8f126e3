from lightzero_tpu.workers.collector import RolloutCollector
from lightzero_tpu.workers.evaluator import Evaluator
