from kspider_tpu.utils.logger import Logger  # noqa: F401
from kspider_tpu.utils.timing import Span, timed  # noqa: F401
