from monoforce_tpu.utils.io import read_yaml, write_to_yaml, load_calib
from monoforce_tpu.utils.timing import timing, Timer
from monoforce_tpu.utils.misc import normalize, position
from monoforce_tpu.utils.data import compile_data, NumpyLoader, PrefetchLoader
from monoforce_tpu.utils.locking import PathLock, write_to_csv, append_to_csv
from monoforce_tpu.utils.profiling import trace, measure

__all__ = [
    "read_yaml", "write_to_yaml", "load_calib",
    "timing", "Timer",
    "normalize", "position",
    "compile_data", "NumpyLoader", "PrefetchLoader",
    "PathLock", "write_to_csv", "append_to_csv",
    "trace", "measure",
]
