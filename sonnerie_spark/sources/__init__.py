"""sonnerie_spark.sources"""
