from .detector import harris_score, detect_features, equalize_histogram
from .pyramid import build_pyramid
from .klt import track_features
from .tracker import TrackerState, TrackerConfig, tracker_init, tracker_step
