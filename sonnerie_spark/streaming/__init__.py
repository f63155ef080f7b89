"""sonnerie_spark.streaming"""
