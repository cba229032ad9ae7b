from .graph import Material, NodeArgument, NodeType, SceneGraph
from .tape import CompiledTape, compile_tape

__all__ = [
    "Material",
    "NodeArgument",
    "NodeType",
    "SceneGraph",
    "CompiledTape",
    "compile_tape",
]
