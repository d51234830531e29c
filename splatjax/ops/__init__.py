from splatjax.ops.projection import ProjectedGaussians, project_gaussians, eval_sh

__all__ = ["ProjectedGaussians", "project_gaussians", "eval_sh"]
