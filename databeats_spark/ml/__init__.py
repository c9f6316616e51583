from databeats_spark.ml.regression import train_popularity_model  # noqa: F401
from databeats_spark.ml.recommender import SongRecommender  # noqa: F401
