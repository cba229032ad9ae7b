from .megakernel import pack_scene, render_image_pallas

__all__ = ["pack_scene", "render_image_pallas"]
