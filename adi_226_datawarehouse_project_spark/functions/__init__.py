from .geohash import encode_geohash_py, geohash_col, geohash_sql

__all__ = ["encode_geohash_py", "geohash_col", "geohash_sql"]
