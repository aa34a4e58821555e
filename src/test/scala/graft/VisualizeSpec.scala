package graft

import graft.operators.Visualize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import javax.imageio.ImageIO

class VisualizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("renderPng produces a decodable image with ink where the data is") {
    val c = Tables.customerPts(spark, "/root/testdata/sf0.001")
    val png = Visualize.renderPng(c, col("cx"), col("cy"), 0, 0, 1000, 1000, 64, 64)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 64 && img.getHeight == 64)
    var lit0 = 0
    for (x <- 0 until 64; y <- 0 until 64)
      if (img.getRaster.getSample(x, y, 0) > 0) lit0 += 1
    assert(lit0 > 100, s"expected many lit pixels, got $lit0") // 1500 points spread out
  }

  test("empty world region renders an all-black image") {
    val c = Tables.customerPts(spark, "/root/testdata/sf0.001")
    val png = Visualize.renderPng(c, col("cx"), col("cy"), 5000, 5000, 6000, 6000, 16, 16)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    var lit0 = 0
    for (x <- 0 until 16; y <- 0 until 16)
      if (img.getRaster.getSample(x, y, 0) > 0) lit0 += 1
    assert(lit0 == 0)
  }
}
