from .traverse_packet import packet_intersect
