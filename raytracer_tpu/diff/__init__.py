from raytracer_tpu.diff.inverse import (image_loss, image_loss_pyramid,
                                        fit_scene_params,
                                        make_kernel_renderer, make_loss_fn)

__all__ = ["image_loss", "image_loss_pyramid", "fit_scene_params", "make_kernel_renderer",
           "make_loss_fn"]
