"""sonnerie_spark.functions"""
