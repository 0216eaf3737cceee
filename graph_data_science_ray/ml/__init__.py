from graph_data_science_ray.ml.linreg import LinearRegression
from graph_data_science_ray.ml.logreg import LogisticRegression

__all__ = ["LinearRegression", "LogisticRegression"]
