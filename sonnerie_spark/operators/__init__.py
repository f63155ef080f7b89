"""sonnerie_spark.operators"""
