from .writer import VIOWriter, rotation_to_quaternion
from .config import (load_config, settings_from_config, sim_params_from_config,
                     tracker_config_from_config)
from .timing import LoopTimer
