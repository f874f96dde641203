from .traverse_packet import packet_intersect
from .traverse_packet4 import packet4_intersect
