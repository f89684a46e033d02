module @_grid_entry {
  func.func @main(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32, %arg4: memref<1x1x512x128xbf16, #tpu.memory_space<vmem>>, %arg5: memref<1x1x1024x128xbf16, #tpu.memory_space<vmem>>, %arg6: memref<1x1x1024x128xbf16, #tpu.memory_space<vmem>>, %arg7: memref<1x1x512x128xbf16, #tpu.memory_space<vmem>>, %arg8: memref<512x128xf32, #tpu.memory_space<vmem>>, %arg9: memref<512x128xf32, #tpu.memory_space<vmem>>, %arg10: memref<512x128xf32, #tpu.memory_space<vmem>>) attributes {dimension_semantics = [#tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<arbitrary>], iteration_bounds = array<i64: 1, 4, 4, 2>, scalar_prefetch = 0 : i64, scratch_operands = 3 : i64, window_params = [{transform_indices = @transform_0, window_bounds = array<i64: 1, 1, 512, 128>}, {transform_indices = @transform_1, window_bounds = array<i64: 1, 1, 1024, 128>}, {transform_indices = @transform_2, window_bounds = array<i64: 1, 1, 1024, 128>}, {transform_indices = @transform_3, window_bounds = array<i64: 1, 1, 512, 128>}]} {
    %cst = arith.constant dense<0.127517432> : vector<512x128xf32>
    %cst_0 = arith.constant dense<0.000000e+00> : vector<512x128xf32>
    %cst_1 = arith.constant dense<0.000000e+00> : vector<512xf32>
    %cst_2 = arith.constant dense<0xFF800000> : vector<512xf32>
    %cst_3 = arith.constant dense<0.000000e+00> : vector<512x1024xf32>
    %c0 = arith.constant 0 : index
    %c1_i32 = arith.constant 1 : i32
    %c0_i32 = arith.constant 0 : i32
    %0 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %1 = arith.cmpi eq, %arg3, %c1_i32 : i32
    %2 = vector.load %arg4[%c0, %c0, %c0, %c0] : memref<1x1x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %3 = vector.shape_cast %2 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %4 = arith.extf %3 : vector<512x128xbf16> to vector<512x128xf32>
    %5 = arith.mulf %4, %cst : vector<512x128xf32>
    %6 = arith.truncf %5 : vector<512x128xf32> to vector<512x128xbf16>
    %7 = vector.load %arg5[%c0, %c0, %c0, %c0] : memref<1x1x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %8 = vector.shape_cast %7 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %9 = vector.load %arg6[%c0, %c0, %c0, %c0] : memref<1x1x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %10 = vector.shape_cast %9 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %11 = tpu.matmul %6, %8, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<1024x128xbf16>, vector<512x1024xf32> -> vector<512x1024xf32>
    scf.if %0 {
      %13 = vector.multi_reduction <maximumf>, %11, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %14 = vector.shape_cast %13 : vector<512xf32> to vector<512x1xf32>
      %15 = vector.broadcast %14 : vector<512x1xf32> to vector<512x128xf32>
      %16 = vector.broadcast %14 : vector<512x1xf32> to vector<512x1024xf32>
      %17 = arith.subf %11, %16 : vector<512x1024xf32>
      %18 = math.exp2 %17 : vector<512x1024xf32>
      %19 = arith.truncf %18 : vector<512x1024xf32> to vector<512x1024xbf16>
      %20 = vector.multi_reduction <add>, %18, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %21 = vector.shape_cast %20 : vector<512xf32> to vector<512x1xf32>
      %22 = vector.broadcast %21 : vector<512x1xf32> to vector<512x128xf32>
      %23 = tpu.matmul %19, %10, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %15 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %22 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %23 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %12 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %12 {
      %13 = vector.load %arg9[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %14 = vector.load %arg10[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %15 = vector.load %arg8[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %16 = vector.multi_reduction <maximumf>, %11, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %17 = vector.shape_cast %16 : vector<512xf32> to vector<512x1xf32>
      %18 = vector.broadcast %17 : vector<512x1xf32> to vector<512x128xf32>
      %19 = arith.maximumf %13, %18 : vector<512x128xf32>
      %20 = vector.extract_strided_slice %19 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %21 = vector.broadcast %20 : vector<512x1xf32> to vector<512x1024xf32>
      %22 = arith.subf %11, %21 : vector<512x1024xf32>
      %23 = math.exp2 %22 : vector<512x1024xf32>
      %24 = arith.subf %13, %19 : vector<512x128xf32>
      %25 = math.exp2 %24 : vector<512x128xf32>
      %26 = arith.truncf %23 : vector<512x1024xf32> to vector<512x1024xbf16>
      %27 = arith.mulf %14, %25 : vector<512x128xf32>
      %28 = vector.multi_reduction <add>, %23, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %29 = vector.shape_cast %28 : vector<512xf32> to vector<512x1xf32>
      %30 = vector.broadcast %29 : vector<512x1xf32> to vector<512x128xf32>
      %31 = arith.addf %27, %30 : vector<512x128xf32>
      %32 = tpu.matmul %26, %10, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %33 = vector.extract_strided_slice %25 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %34 = vector.broadcast %33 : vector<512x1xf32> to vector<512x128xf32>
      %35 = arith.mulf %15, %34 : vector<512x128xf32>
      %36 = arith.addf %35, %32 : vector<512x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %19 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %31 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %36 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    scf.if %1 {
      %13 = vector.load %arg10[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %14 = vector.load %arg8[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %15 = vector.broadcast %13 : vector<512x1xf32> to vector<512x128xf32>
      %16 = arith.divf %14, %15 : vector<512x128xf32>
      %17 = arith.truncf %16 : vector<512x128xf32> to vector<512x128xbf16>
      %18 = vector.shape_cast %17 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c0, %c0, %c0], %18 {strides = array<i32>} : memref<1x1x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
    }
    return
  }
  func.func @transform_0(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_1(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_2(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_3(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
}

