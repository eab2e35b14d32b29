from .metrics import pc_metrics, PointCloudMetric, estimate_normals
from .bjontegaard import bd_rate, bd_psnr, BjontegaardModel
