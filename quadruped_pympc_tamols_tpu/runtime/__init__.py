from .control_bus import ControlBus, pack_control_block, unpack_control_block
from .controller_node import ControllerNode

__all__ = ["ControlBus", "pack_control_block", "unpack_control_block", "ControllerNode"]
