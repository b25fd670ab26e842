from .asl import ASLDatasetReader
from .uzhfpv import UZHFPVDatasetReader
from .anu import APDatasetReader
from .rosbag import BagWriter, HiltiDatasetReader, RosbagDatasetReader
from .server import DataServer, create_dataset_reader
from .synthetic import (generate_asl_dataset, generate_racing_proxy, generate_uzhfpv_dataset, generate_v101_proxy)
