package graft.etl

import graft.SparkSuite

class QuarantineSpec extends SparkSuite {

  test("poison blob quarantines instead of failing the load (dead-letter upgrade)") {
    val landing = java.nio.file.Files.createTempDirectory("graft_q").toString
    Extract.land(() => """[{"userId":1,"id":1,"title":"ok","body":"good"}]""",
      landing, java.time.Instant.parse("2024-03-01T00:00:00Z"))
    Extract.land(() => """{"userId": 2, "id": oops not json""",
      landing, java.time.Instant.parse("2024-03-01T00:00:01Z"))
    val (good, quarantined) = Load.readLandingQuarantined(spark, landing)
    assert(good.count() == 1)
    assert(good.head().getAs[Long]("id") == 1L)
    assert(quarantined.count() == 1)
    // the poison payload is preserved verbatim for replay/debugging
    assert(quarantined.head().getString(0).contains("oops not json"))
  }
}
